"""Structured Streaming surface over the events table (SURVEY.md §2.9).

The reference has NO streaming — its cadence is a weekly CronJob full
re-extract. These operators are clearly-flagged extensions: windowed
aggregations, session windows, watermarked late-data handling, and
streaming dedup, written so the SAME transformation function applies
to a batch DataFrame (oracle-checkable) and a streaming DataFrame
(watermark + incremental state). tests/test_streaming.py runs both
and checks they agree.
"""
