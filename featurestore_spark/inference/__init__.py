from featurestore_spark.inference.dates import DateParser, ParsedDate  # noqa: F401
from featurestore_spark.inference.sniffer import FileMetadata, sniff, sniff_file  # noqa: F401
