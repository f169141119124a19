from redskins_rule_spark.functions.dates import election_days, election_days_py
from redskins_rule_spark.functions.hashing import (
    char_fingerprint,
    minhash_signature,
    shingles,
)

__all__ = [
    "election_days",
    "election_days_py",
    "char_fingerprint",
    "minhash_signature",
    "shingles",
]
