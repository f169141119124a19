"""Pipeline compositions of the operator library."""
