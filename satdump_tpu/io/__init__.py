from satdump_tpu.io.baseband import BasebandReader, BasebandWriter, read_baseband, write_baseband  # noqa: F401
