"""Engine operators: compositions of DataFrame primitives (and, where
semantics demand, Arrow-batched Pandas UDFs) — never row-at-a-time
Python in the hot path."""
