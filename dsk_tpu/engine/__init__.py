from dsk_tpu.engine.counter import CountEngine, CountResult  # noqa: F401
