"""Source connectors.

Reference parity map (SURVEY §2.1):

- Iterator source (`to_stream`, arcon/src/dataflow/source.rs) —
  `Stream.from_collection` (streaming/stream.py) for the embedded
  form; `arcon_spark.sources.python_datasource.CollectionDataSource`
  for the PLUGGABLE form (Spark 4 Python DataSource API: the source
  registers by name and any reader — SQL, DataFrame, readStream —
  can `.format("arcon_collection")` it).
- `LocalFileSource` — `Stream.from_file` (text/csv/json/parquet/orc).
- `KafkaSource` / `SocketSource` — `Stream.from_kafka` / `from_socket`.
- Rate source — `Stream.from_rate`.
"""

from arcon_spark.sources.python_datasource import (  # noqa: F401
    CollectionDataSource,
    register_collection_source,
)
