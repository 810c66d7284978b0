from refid_tpu.models.refid import FinalBidirectionAttenfusion, RefidConfig

__all__ = ["FinalBidirectionAttenfusion", "RefidConfig"]
