"""Write-path and beyond-reference operators (SURVEY.md §2.A, §7.5)."""
