"""Host-side utilities: init, validation, analysis, checkpoint, data."""
