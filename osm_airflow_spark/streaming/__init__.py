"""Structured Streaming ports of the time-window operators (SURVEY.md
§2.I / §7.6)."""
