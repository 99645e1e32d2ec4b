"""Sources & sinks: table registry + the outlier-enrichment results sink."""
