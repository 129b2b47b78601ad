from featurestore_spark.inference.sniffer import FileMetadata, sniff, sniff_file  # noqa: F401
