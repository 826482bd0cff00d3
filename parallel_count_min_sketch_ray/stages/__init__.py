"""Ray Data stages: accumulators, UDAF adapters, combiners."""
