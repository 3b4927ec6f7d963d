"""Schema planning layer: draft-4 parsing, $ref resolution, and
compilation into Spark Column trees + Arrow batch validators."""
