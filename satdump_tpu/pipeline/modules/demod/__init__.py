import satdump_tpu.pipeline.modules.demod.psk  # noqa: F401
import satdump_tpu.pipeline.modules.demod.fm  # noqa: F401
