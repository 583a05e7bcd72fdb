"""Framework utilities: config, logging, image IO, metrics."""
