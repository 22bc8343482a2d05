"""Crawl plans: the iterative Spark superstep loop and its serial oracle."""
