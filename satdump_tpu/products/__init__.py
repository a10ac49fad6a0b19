"""products subpackage."""

import satdump_tpu.products.calibrators  # noqa: F401  (registers calibrators)
