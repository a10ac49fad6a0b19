import satdump_tpu.pipeline.modules.inmarsat.aero_decoder  # noqa: F401
import satdump_tpu.pipeline.modules.inmarsat.aero_parser  # noqa: F401
import satdump_tpu.pipeline.modules.inmarsat.stdc_decoder  # noqa: F401
import satdump_tpu.pipeline.modules.inmarsat.stdc_parser  # noqa: F401
