"""Read-path query plans (dashboard/API parity, SURVEY.md §2.B)."""
