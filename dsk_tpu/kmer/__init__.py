from dsk_tpu.kmer import codec  # noqa: F401
