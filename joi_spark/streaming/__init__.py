from joi_spark.streaming.validate import (stream_drift, stream_sessions,
                                          stream_verdicts, stream_violations)

__all__ = ["stream_violations", "stream_verdicts", "stream_sessions",
           "stream_drift"]
