"""Pipeline operators: blocking, pair-gen, scoring, clustering, dedup,
similarity search, linkage. Each is a pure DataFrame -> DataFrame
function; orchestration/checkpointing lives in plans/."""
