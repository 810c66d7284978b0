from refid_tpu.tasks.base import build_task
# register tasks
from refid_tpu.tasks import recurrent  # noqa: F401
from refid_tpu.tasks import single     # noqa: F401

__all__ = ["build_task"]
