"""URL/URI scalar helpers — reference's resource/gateway URL construction.

- resource_uri: "{protocol}://{id}" (/root/reference/types/resource.go:14-16)
- gateway_url: fetch URL preferring a named path for MIME sniffing
  (/root/reference/components/protocol/ipfs/gatewayurl.go:13-33)
All pure Spark built-ins (format_string / url_encode), zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def resource_uri(protocol: Column, res_id: Column) -> Column:
    return F.format_string("%s://%s", protocol, res_id)


def url_path_escape(c: Column) -> Column:
    """Path-segment escaping: url_encode then restore path-legal chars the
    reference's path-escape keeps (Go url.PathEscape vs QueryEscape: '+' must
    be encoded, spaces become %20 not '+')."""
    return F.regexp_replace(F.url_encode(c), r"\+", "%20")


def gateway_url(gateway: Column, res_id: Column,
                ref_parent: Column, ref_name: Column) -> Column:
    """Prefer {gw}/ipfs/{parent}/{name} when a named reference exists (MIME
    sniffing off the filename), else {gw}/ipfs/{id}
    (reference gatewayurl.go:15-31)."""
    named = F.format_string("%s/ipfs/%s/%s", gateway, ref_parent,
                            url_path_escape(ref_name))
    direct = F.format_string("%s/ipfs/%s", gateway, res_id)
    return F.when(ref_parent.isNotNull() & ref_name.isNotNull() &
                  (F.length(ref_name) > 0), named).otherwise(direct)
