"""Subpackage of fluent_plugin_detect_exceptions_spark."""
