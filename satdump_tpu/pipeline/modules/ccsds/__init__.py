import satdump_tpu.pipeline.modules.ccsds.conv_concat  # noqa: F401
