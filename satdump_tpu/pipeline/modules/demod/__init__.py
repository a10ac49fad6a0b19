import satdump_tpu.pipeline.modules.demod.psk  # noqa: F401
import satdump_tpu.pipeline.modules.demod.fm  # noqa: F401
import satdump_tpu.pipeline.modules.demod.pm  # noqa: F401
import satdump_tpu.pipeline.modules.demod.fsk  # noqa: F401
