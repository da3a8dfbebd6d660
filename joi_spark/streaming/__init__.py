from joi_spark.streaming.validate import (corpus_fingerprints, stream_dedup,
                                          stream_drift, stream_sessions,
                                          stream_verdicts, stream_violations)

__all__ = ["stream_violations", "stream_verdicts", "stream_sessions",
           "stream_drift", "stream_dedup", "corpus_fingerprints"]
