"""End-to-end pipeline plans and reporting queries."""
