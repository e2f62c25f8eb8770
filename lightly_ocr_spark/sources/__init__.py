"""Sources & sinks: synthetic pages corpus, parquet/manifest table IO."""
