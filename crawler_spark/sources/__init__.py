"""Input sources: synthetic web fixtures (test fetch = join) and payloads."""
