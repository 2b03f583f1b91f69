"""Pure-Python reference simulator (stand-in oracle, SURVEY.md §0.3)."""
