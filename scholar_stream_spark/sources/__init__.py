"""Sources & sinks: NDJSON files, bronze landing, paginated REST source."""
