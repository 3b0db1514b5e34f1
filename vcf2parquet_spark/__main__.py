from vcf2parquet_spark.cli import main

raise SystemExit(main())
