package graft.graph

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** openEO process-graph model + parser (replaces the reference's external
  * openeo-pg-parser dependency, openeo_odc_driver/openeo_odc_driver.py:90).
  *
  * A process graph is a JSON object {nodeId → {process_id, arguments,
  * result?}}; arguments reference other nodes ({"from_node": id}), parent
  * parameters ({"from_parameter": name}), literals, or embedded child
  * process graphs ({"process_graph": {...}}) — the openEO reducer/callback
  * convention.
  */
object ProcessGraph {

  sealed trait Arg
  final case class LitArg(value: JsonNode) extends Arg
  final case class FromNode(nodeId: String) extends Arg
  final case class FromParameter(name: String) extends Arg
  final case class SubGraph(graph: ProcessGraph) extends Arg
  final case class ArrayArg(items: Seq[Arg]) extends Arg

  final case class Node(
      id: String,
      processId: String,
      arguments: Map[String, Arg],
      result: Boolean) {
    /** Node ids this node depends on (transitively through array args,
      * NOT through sub-graphs — those bind at their parent's scope). */
    def deps: Seq[String] = arguments.values.toSeq.flatMap(argDeps)
    private def argDeps(a: Arg): Seq[String] = a match {
      case FromNode(id)  => Seq(id)
      case ArrayArg(xs)  => xs.flatMap(argDeps)
      case SubGraph(g)   => g.externalDeps
      case _             => Nil
    }
  }

  def parse(json: String): ProcessGraph = {
    val root = new ObjectMapper().readTree(json)
    // accept either the bare graph or {"process_graph": {...}} wrapping
    val graphNode =
      if (root.has("process_graph")) root.get("process_graph") else root
    fromJson(graphNode)
  }

  def fromJson(graphNode: JsonNode): ProcessGraph = {
    val nodes = graphNode.properties().asScala.map { e =>
      val id = e.getKey; val n = e.getValue
      val args = Option(n.get("arguments")).map(_.properties().asScala.map { a =>
        a.getKey -> parseArg(a.getValue)
      }.toMap).getOrElse(Map.empty)
      Node(id, n.get("process_id").asText(), args,
        Option(n.get("result")).exists(_.asBoolean(false)))
    }.toSeq
    ProcessGraph(nodes.map(n => n.id -> n).toMap)
  }

  private def parseArg(v: JsonNode): Arg =
    if (v.isObject && v.has("from_node")) FromNode(v.get("from_node").asText())
    else if (v.isObject && v.has("from_parameter"))
      FromParameter(v.get("from_parameter").asText())
    else if (v.isObject && v.has("process_graph"))
      SubGraph(fromJson(v.get("process_graph")))
    else if (v.isArray) ArrayArg(v.elements().asScala.toSeq.map(parseArg))
    else LitArg(v)
}

final case class ProcessGraph(nodes: Map[String, ProcessGraph.Node]) {
  import ProcessGraph._

  /** Node ids referenced by this graph's nodes that are NOT defined in this
    * graph (i.e. references escaping a sub-graph to the enclosing scope). */
  def externalDeps: Seq[String] =
    nodes.values.toSeq.flatMap(_.deps).distinct.filterNot(nodes.contains)

  /** Topological order (dependencies first) — the reference's
    * `.sort(by='result')` planner (openeo_odc_driver.py:90). Deterministic:
    * ties broken by node id. */
  def topoSorted: Seq[Node] = {
    val visited = scala.collection.mutable.LinkedHashSet[String]()
    val visiting = scala.collection.mutable.Set[String]()
    def visit(id: String): Unit = {
      if (!visited.contains(id) && nodes.contains(id)) {
        require(visiting.add(id), s"process graph cycle at node $id")
        nodes(id).deps.distinct.sorted.foreach(visit)
        visiting.remove(id)
        visited.add(id)
      }
    }
    nodes.keys.toSeq.sorted.foreach(visit)
    visited.toSeq.map(nodes)
  }

  /** The node flagged `"result": true`. The openEO spec requires exactly
    * one; silently falling back to "the last topological node" would
    * compute an arbitrary intermediate when a client forgets the flag. */
  def resultNode: Node =
    nodes.values.find(_.result).getOrElse(throw new IllegalArgumentException(
      "process graph has no node with \"result\": true"))
}
