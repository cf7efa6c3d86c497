"""Host-side utilities: config parsing, logging, artifact store."""
