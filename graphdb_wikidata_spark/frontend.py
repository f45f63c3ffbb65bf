"""Static HTML frontend for the query endpoint — the Spark-side
equivalent of the reference's warp-served page (frontend/index.html,
frontend/app.js): a SPARQL textarea that GETs /query and shows the
W3C SPARQL-JSON response. Original implementation: same surface
(form -> /query?query=... -> result pane), not a copy; ours fetches
relative to the serving host (the reference hardcodes 127.0.0.1:8005)
and renders the bindings as a table as well as raw JSON.
"""

from __future__ import annotations

INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>graphdb-wikidata-spark</title>
<style>
  body { font-family: system-ui, sans-serif; max-width: 60em; margin: 2em auto; }
  textarea { width: 100%; height: 10em; font-family: monospace; }
  table { border-collapse: collapse; margin-top: 1em; }
  td, th { border: 1px solid #999; padding: 0.25em 0.6em; text-align: left; }
  pre { background: #f4f4f4; padding: 1em; overflow-x: auto; }
  .err { color: #a00; }
</style>
</head>
<body>
<h1>graphdb-wikidata-spark</h1>
<p>SPARQL over the statements graph; results are W3C SPARQL-JSON.</p>
<form id="f">
  <textarea id="q" spellcheck="false"
    placeholder="SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 10"></textarea>
  <br><button type="submit">Run</button>
</form>
<div id="out"></div>
<pre id="raw"></pre>
<script src="/app.js"></script>
</body>
</html>
"""

APP_JS = """"use strict";
const form = document.getElementById("f");
const out = document.getElementById("out");
const raw = document.getElementById("raw");

function cellText(b) {
  if (!b) return "";
  return b.value !== undefined ? String(b.value) : JSON.stringify(b);
}

function renderTable(json) {
  if (json.boolean !== undefined) {
    out.innerHTML = "<p><strong>ASK:</strong> " + json.boolean + "</p>";
    return;
  }
  const vars = (json.head && json.head.vars) || [];
  const rows = (json.results && json.results.bindings) || [];
  const tbl = document.createElement("table");
  const hdr = tbl.insertRow();
  for (const v of vars) {
    const th = document.createElement("th");
    th.textContent = v;
    hdr.appendChild(th);
  }
  for (const r of rows) {
    const tr = tbl.insertRow();
    for (const v of vars) tr.insertCell().textContent = cellText(r[v]);
  }
  out.replaceChildren(tbl);
}

form.addEventListener("submit", async (ev) => {
  ev.preventDefault();
  const q = document.getElementById("q").value;
  out.innerHTML = "<p>running\\u2026</p>";
  raw.textContent = "";
  try {
    const resp = await fetch("/query?query=" + encodeURIComponent(q));
    const text = await resp.text();
    if (!resp.ok) {
      out.innerHTML = "<p class=err>HTTP " + resp.status + "</p>";
      raw.textContent = text;
      return;
    }
    const json = JSON.parse(text);
    renderTable(json);
    raw.textContent = JSON.stringify(json, null, 2);
  } catch (err) {
    out.innerHTML = "<p class=err>" + err + "</p>";
  }
});
"""
