"""Serialization formats: the reference's Avro OCF blob contract
(write_to_avro.go, avro.go) implemented stdlib-only + Spark plumbing."""
