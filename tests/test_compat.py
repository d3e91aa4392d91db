"""Reference-API façade: the reference's own extraction test
(tests/test_extract.py:20-71 in /root/reference) transliterated to the
compat layer — same call sequence, same expectations."""

from __future__ import annotations


def test_extract_herzog_via_compat():
    import textgraphs_ray.compat as textgraphs

    text = """
Werner Herzog is a remarkable filmmaker and intellectual originally from Germany, the son of Dietrich Herzog.
    """

    tg = textgraphs.TextGraphs(factory=textgraphs.PipelineFactory())
    pipe = tg.create_pipeline(text.strip())
    tg.collect_graph_elements(pipe, debug=False)
    tg.perform_entity_linking(pipe, debug=False)
    tg.construct_lemma_graph(debug=False)
    tg.calc_phrase_ranks(debug=False)

    results = [(row["text"], row["pos"])
               for _, row in tg.get_phrases_as_df().iterrows()][:4]

    for pair in [("Germany", "PROPN"), ("Werner Herzog", "PROPN"),
                 ("Dietrich Herzog", "PROPN")]:
        assert pair in results

    # exports run off the same state
    rdf = tg.export_rdf()
    assert "werner" in rdf.lower()
    # default dump is the REFERENCE's node-link shape (positional
    # links); canonical engine format available via fmt=
    dumped = tg.dump_lemma_graph()
    assert '"nodes"' in dumped and '"links"' in dumped
    canon = tg.dump_lemma_graph(fmt="canonical")
    assert '"edges"' in canon

    # load_lemma_graph round-trips either format (the reference's
    # resume path, graph.py:299-391)
    tg2 = textgraphs.TextGraphs()
    tg2.load_lemma_graph(dumped)
    assert tg2.dump_lemma_graph(fmt="canonical") == canon


def test_compat_multi_doc_accumulation_and_er():
    import textgraphs_ray.compat as textgraphs

    tg = textgraphs.TextGraphs()
    for text in ["Werner Herzog directed a film.",
                 "W. Herzog visited Germany."]:
        tg.collect_graph_elements(tg.create_pipeline(text))
    clusters = tg.resolve_entities()
    cl = dict(zip(clusters["key"], clusters["cluster_id"]))
    # initial variant resolves to the same entity cluster
    assert cl["werner.PROPN.herzog.PROPN"] == cl["w..PROPN.herzog.PROPN"]


def test_gor_compat_matches_pipeline():
    from textgraphs_ray.compat import GraphOfRelations, KGWikiMedia

    g = GraphOfRelations()
    g.load_ingram("/root/reference/examples/ingram.json")
    g.seeds()
    g.construct_gor()
    df = g.get_affinity_scores()
    assert len(df) == 12 and {"rel_a", "rel_b", "score"} <= set(df.columns)

    kg = KGWikiMedia()
    assert kg.remap_ner("PERSON") == "http://dbpedia.org/ontology/Person"
    assert kg.normalize_prefix(
        "http://www.w3.org/2002/07/owl#Thing") == "owl:Thing"


def test_render_pyvis_styling():
    import textgraphs_ray.compat as textgraphs

    tg = textgraphs.TextGraphs()
    tg.collect_graph_elements(tg.create_pipeline(
        "Werner Herzog directed a film in Germany."))
    tg.construct_lemma_graph()
    tg.calc_phrase_ranks()
    nodes, edges = textgraphs.RenderPyVis(tg).render_lemma_graph()
    assert {"shape", "color", "size"} <= set(nodes.columns)
    assert (nodes.loc[nodes["kind"] == "ent", "shape"] == "circle").all()
    assert len(edges) > 0
