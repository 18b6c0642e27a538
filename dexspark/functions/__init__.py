"""dexspark.functions — training-data-pipeline operators over the
documents / embeddings tables: text analysis, deduplication families,
similarity search, multimodal plumbing."""
