"""Host-side utilities: image IO, config, logging, progress."""
