from refid_tpu.serve.fast_forward import fast_forward  # noqa: F401
