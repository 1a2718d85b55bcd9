"""Cross-cutting utilities: phase timers, progress, properties.

The TPU framework's analog of gatb-core tools/misc (SURVEY.md C16):
TimeInfo phase timers, Progress observer lines, IProperties run-info.
"""
