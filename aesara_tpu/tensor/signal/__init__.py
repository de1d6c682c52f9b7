"""Legacy ``tensor/signal`` namespace (reference kept pool/conv here)."""
