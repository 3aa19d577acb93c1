from persistor_spark.cli import main

raise SystemExit(main())
