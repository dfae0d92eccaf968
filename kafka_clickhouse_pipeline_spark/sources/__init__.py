"""Sources: Kafka JSON streams (the reference's Kafka-engine tables)
and a file-based JSON-lines stand-in for offline testing."""
