"""sources — corpus input connectors.

- `onf`: the reference's native `.onf` corpus format as a Spark source
  (binaryFile scan + Arrow-batched parse), with id-list split routing —
  the distributed `ontonotes5_to_json` (SURVEY.md §3.1).
"""

from .onf import onf_annotations, load_split_ids, route_by_id_lists, onf_to_json

__all__ = ["onf_annotations", "load_split_ids", "route_by_id_lists", "onf_to_json"]
