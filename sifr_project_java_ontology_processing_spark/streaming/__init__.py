"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.9: its
checkpoint/resume requirement maps to snapshot-based batch stages, not
Structured Streaming). This module provides the streaming twins of the
batch operators for continuously-arriving pages/events: windowed event
aggregation with watermarks, and streaming extraction+mention detection
(both map-only, so they lift to streams unchanged).
"""
