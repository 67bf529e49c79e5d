"""Structured Streaming operators (reference: src/execution/live_updater.rs,
source change streams; Spark-native watermarks/windows beyond the
reference per SURVEY §2.5 notes)."""
