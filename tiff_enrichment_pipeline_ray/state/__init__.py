"""Run state: checkpoint manifest (exact resume) + skew salting plans."""
