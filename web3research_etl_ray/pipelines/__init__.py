"""End-to-end pipelines: replay (init), tail (sync), check/repair, compact."""
