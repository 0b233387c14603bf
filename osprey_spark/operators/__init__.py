"""Engine operators: windows, dedup, similarity, multimodal plumbing."""
