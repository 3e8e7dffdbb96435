"""Sequential/full-dependence-model query generation — the reference's
``dm.pl`` (``/root/reference/QryEval/dm.pl:55-112``, Metzler & Croft's
MRF dependence models): a bag-of-words query becomes

  #wand ( wT #and(t1 … tn)
          wO #and(#near/1(t1 t2) #near/1(t2 t3) …)
          wU #and(#window/N(t1 t2) #window/N(t2 t3) …) )

with the course defaults (0.7, 0.2, 0.1) and window = 4·|pair| — here a
fixed ``window`` parameter (the reference generator used /8). Full
dependence adds every pair, not just adjacent ones.
"""

from __future__ import annotations


def sdm_query(query: str, w_terms: float = 0.7, w_ordered: float = 0.2,
              w_unordered: float = 0.1, near_dist: int = 1,
              window: int = 8, full: bool = False) -> str:
    terms = query.split()
    if len(terms) <= 1:
        return query
    if full:
        pairs = [(a, b) for i, a in enumerate(terms)
                 for b in terms[i + 1:]]
    else:
        pairs = list(zip(terms, terms[1:]))
    nears = " ".join(f"#near/{near_dist}( {a} {b} )" for a, b in pairs)
    windows = " ".join(f"#window/{window}( {a} {b} )" for a, b in pairs)
    return (f"#wand ( {w_terms:g} #and( {' '.join(terms)} ) "
            f"{w_ordered:g} #and( {nears} ) "
            f"{w_unordered:g} #and( {windows} ) )")
