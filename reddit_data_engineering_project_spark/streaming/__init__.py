"""Streaming surface: batch-equivalent S1-S5 queries, the live
availableNow runner, and the applyInPandasWithState stateful operator."""
