"""Relational building blocks of the crawl engine."""
