from stutter_tpu.cli import main

raise SystemExit(main())
