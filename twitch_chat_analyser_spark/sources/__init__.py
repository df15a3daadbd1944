"""Stream sources and wire-format serde (SURVEY.md §2.A items A1-A3)."""
