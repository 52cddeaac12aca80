"""Data subsystem: dataset abstractions, HDR/LDR IO, record files, loaders."""
