from gridiron_spark.cli import main

raise SystemExit(main())
