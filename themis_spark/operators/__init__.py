"""Table-level dataflow operators (SURVEY.md §2(b) + training-data ops)."""
