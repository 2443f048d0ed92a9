from cwds_jobs_spark.cli import main

raise SystemExit(main())
