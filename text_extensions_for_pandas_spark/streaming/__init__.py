from text_extensions_for_pandas_spark.streaming.ops import (  # noqa: F401
    read_documents_stream,
    read_events_stream,
    streaming_dedup_exact,
    streaming_dedup_minhash,
    streaming_error_followups,
    streaming_extract_consolidated,
    streaming_extract_dict,
    streaming_extract_regex,
    streaming_hourly_counts,
    streaming_session_stats,
    streaming_sliding_value,
    streaming_user_running_stats,
)
