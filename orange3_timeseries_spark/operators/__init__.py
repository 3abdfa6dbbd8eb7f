"""Operator library: windowed/block/period aggregation, differences,
interpolation, slicing, grouping, dedup/similarity/text-analysis."""
