"""The crawl layer: frontier, URL-seen sketches, politeness scheduling,
robots handling, canonicalization, and the micro-batch crawl loop."""
