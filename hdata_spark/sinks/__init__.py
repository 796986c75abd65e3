from hdata_spark.sinks.snapshot import SnapshotTable
