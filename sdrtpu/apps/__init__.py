"""Receiver orchestration: configs, sources, sinks, CLI."""
