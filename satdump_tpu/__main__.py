from satdump_tpu.cli import main

raise SystemExit(main())
