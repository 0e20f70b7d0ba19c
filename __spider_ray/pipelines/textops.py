"""Training-data ops over documents/embeddings (dedup, text, ANN).

Placeholder — populated with MinHash-LSH, SimHash, lang-id, knn.
"""
