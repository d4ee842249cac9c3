from dug_data_ingest_spark.cli import main

main()
