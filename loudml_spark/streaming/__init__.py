from loudml_spark.streaming.job import (  # noqa: F401
    stream_bucketize,
    stateful_detect_stream,
    StreamingEval,
)
