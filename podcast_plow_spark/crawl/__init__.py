"""The crawl engine (epoch loop) and its sequential oracle."""
