"""Sources & sinks: deterministic synthetic corpus, storage adapter."""
