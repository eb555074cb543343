"""Sources and sinks: snapshot-checkpointed tables, page corpora,
fetchers, and the pure-Python PNG codec for the image pipeline."""
