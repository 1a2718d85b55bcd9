from dsk_tpu.io.bank import Bank, open_bank  # noqa: F401
