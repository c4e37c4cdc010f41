"""End-to-end pipeline plans composing the operator library."""
