from hdata_spark.streaming.ledger import CommitLedger
from hdata_spark.streaming.metrics import MetricsLog
from hdata_spark.streaming.replay import ReplayConfig, replay
from hdata_spark.streaming.stateful import (
    repo_progress_stream,
    windowed_event_counts_stream,
)
from hdata_spark.streaming.stream_replay import apply_change_batch, stream_replay
