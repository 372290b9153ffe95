"""Sources: span-corpus readers/writers, the deterministic synthetic corpus
generator, and the pdf2xml ingester."""
