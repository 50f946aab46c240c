"""Sinks: the manifest-committed snapshot table and export writers."""
