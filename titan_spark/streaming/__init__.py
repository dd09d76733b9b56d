from titan_spark.streaming.changelog import (
    CHANGE_LOG_SCHEMA,
    ChangeLogWriter,
    LogProcessorFramework,
    apply_changes,
)

__all__ = [
    "CHANGE_LOG_SCHEMA",
    "ChangeLogWriter",
    "LogProcessorFramework",
    "apply_changes",
]
