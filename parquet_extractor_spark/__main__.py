from parquet_extractor_spark.cli import main

raise SystemExit(main())
