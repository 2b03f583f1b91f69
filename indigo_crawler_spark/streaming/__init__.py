"""Optional Structured-Streaming skin (SURVEY.md §2.10 — informative)."""
