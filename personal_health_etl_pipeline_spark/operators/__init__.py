"""Relational + extended operators: multi-way combine, conflict checks,
incremental watermarks, dedup (exact/MinHash/SimHash/Jaccard),
similarity search, windows/sessionization, multimodal plumbing."""
