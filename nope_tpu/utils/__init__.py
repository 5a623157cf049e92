"""Shared utilities: environment setup, I/O, logging, visualization."""
