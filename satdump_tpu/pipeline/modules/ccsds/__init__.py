import satdump_tpu.pipeline.modules.ccsds.conv_concat  # noqa: F401
import satdump_tpu.pipeline.modules.ccsds.simple_psk  # noqa: F401
import satdump_tpu.pipeline.modules.ccsds.ldpc_decoder  # noqa: F401
import satdump_tpu.pipeline.modules.ccsds.turbo_decoder  # noqa: F401
