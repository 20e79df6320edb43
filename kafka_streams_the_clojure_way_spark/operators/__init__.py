"""Operator library: relational helpers plus the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
that make the engine useful at 100 TB (SURVEY.md §7 M5)."""
