"""Durable crawl state: atomic snapshot commits + resume."""
