from refid_tpu.serve.fast_forward import fast_forward  # noqa: F401
from refid_tpu.serve.fast_scan import (fast_apply_scan,  # noqa: F401
                                       make_fast_apply)
