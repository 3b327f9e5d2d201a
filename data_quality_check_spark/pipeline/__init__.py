"""End-to-end image+caption quality-filter pipeline (the north-star job)."""
