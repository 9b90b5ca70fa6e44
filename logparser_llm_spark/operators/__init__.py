"""Custom operators: Drain clustering, template merge, dedup, ANN, multimodal."""
