package graft.sources

import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.w3c.dom.{Element, Node}

/** RDF/XML reader for the supported ontology subset — the fourth and
  * last of the reference's ontology syntaxes (reference:
  * scripts/convert_ontologies.py:343 maps both `"rdf"` and `"owl"`
  * raw files to rdflib's `format="xml"`; SKOS vocabularies like
  * UNESCO/EuroSciVoc ship this way). Like Turtle/OBO, files are read
  * `wholetext` and parsed per-file into the SAME
  * (s, p, o, o_lang, o_datatype, is_literal) frame as
  * Rdf.readNTriples, so skosTerms / meshTerms / bgpMatch / the SPARQL
  * front-end consume RDF/XML unchanged. XML cannot be parsed from a
  * line-splittable scan, but ontologies are bounded reference data —
  * per-file memory is bounded and parallelism comes from the file
  * count; corpus-scale triples arrive as N-Triples.
  *
  * The parser is the JDK's own DOM (java.xml module — no external RDF
  * library), hardened: DTDs and external entities are disabled, so a
  * hostile ontology file cannot trigger entity expansion or network
  * fetches.
  *
  * Supported RDF/XML striping: `rdf:RDF` root, typed node elements
  * (`<skos:Concept rdf:about=…>` ⇒ an rdf:type triple) and
  * `rdf:Description`, nested node elements (object = inner subject,
  * any depth), `rdf:about` / `rdf:nodeID` subjects, `rdf:resource` /
  * `rdf:nodeID` objects, text-content literals with inherited
  * `xml:lang` (XML's ancestor-scoped rule) and `rdf:datatype`, and
  * XML comments. Not supported — rejected by NAME, never misparsed:
  * `rdf:ID`/`rdf:aboutEach` (need xml:base resolution), `rdf:parseType`
  * (Resource/Collection/Literal striping), `rdf:li` containers, and
  * property attributes (abbreviated syntax).
  */
object RdfXml {

  final case class RdfXmlParseError(msg: String)
      extends IllegalArgumentException(s"RDF/XML parse error: $msg")

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  def readRdfXml(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .text(path)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .flatMap { case (_, text) => parseRdfXml(text) }
      .toDF("s", "p", "o", "o_lang", "o_datatype", "is_literal")
  }

  /** One file's text → triple rows. Pure function, spec-testable
    * without a session. */
  private[graft] def parseRdfXml(
      text: String
  ): Seq[(String, String, String, Option[String], Option[String], Boolean)] = {
    val out = Vector.newBuilder[(String, String, String, Option[String], Option[String], Boolean)]
    var blankCounter = 0

    def err(msg: String): Nothing = throw RdfXmlParseError(msg)

    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    // Entity-expansion / XXE hardening: ontology files are untrusted.
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setXIncludeAware(false)
    factory.setExpandEntityReferences(false)
    val doc =
      try
        factory.newDocumentBuilder().parse(
          new java.io.ByteArrayInputStream(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      catch {
        case e: org.xml.sax.SAXException => err(s"not well-formed XML: ${e.getMessage}")
      }

    val root = doc.getDocumentElement
    if (root.getNamespaceURI != RdfNs || root.getLocalName != "RDF")
      err(s"document root must be rdf:RDF (got '${root.getTagName}')")

    def rdfAttr(e: Element, name: String): Option[String] =
      Option(e.getAttributeNodeNS(RdfNs, name)).map(_.getValue)

    def rejectUnsupported(e: Element): Unit = {
      Seq("ID", "aboutEach", "aboutEachPrefix", "bagID", "parseType").foreach { a =>
        if (rdfAttr(e, a).isDefined) err(s"rdf:$a is not supported")
      }
      if (e.getNamespaceURI == RdfNs && e.getLocalName == "li")
        err("rdf:li containers are not supported")
    }

    /** Closest ancestor-or-self xml:lang, per the XML scoping rule. */
    def langOf(e: Element): Option[String] = {
      var n: Node = e
      while (n != null && n.getNodeType == Node.ELEMENT_NODE) {
        val el = n.asInstanceOf[Element]
        val l = el.getAttributeNS("http://www.w3.org/XML/1998/namespace", "lang")
        if (l.nonEmpty) return Some(l)
        n = n.getParentNode
      }
      None
    }

    def childElements(e: Element): Seq[Element] = {
      val kids = e.getChildNodes
      (0 until kids.getLength).map(kids.item).collect {
        case el: Element => el
      }
    }

    def expandedName(e: Element): String = {
      val ns = e.getNamespaceURI
      if (ns == null)
        err(s"element '${e.getTagName}' has no namespace (RDF/XML names must resolve to IRIs)")
      ns + e.getLocalName
    }

    /** A node element (subject description). Returns the subject term.
      * Deterministic per-file blank labels come from document order. */
    def parseNodeElement(e: Element): String = {
      rejectUnsupported(e)
      val subject = (rdfAttr(e, "about"), rdfAttr(e, "nodeID")) match {
        case (Some(iri), None) => iri
        case (None, Some(id))  => "_:" + id
        case (None, None)      => blankCounter += 1; s"_:genid$blankCounter"
        case (Some(_), Some(_)) => err("a node element cannot have both rdf:about and rdf:nodeID")
      }
      // Typed node element: the element name IS an rdf:type triple.
      if (!(e.getNamespaceURI == RdfNs && e.getLocalName == "Description"))
        out += ((subject, RdfNs + "type", expandedName(e), None, None, false))
      childElements(e).foreach(parsePropertyElement(subject, _))
      subject
    }

    def parsePropertyElement(subject: String, e: Element): Unit = {
      rejectUnsupported(e)
      val predicate = expandedName(e)
      val kids = childElements(e)
      (rdfAttr(e, "resource"), rdfAttr(e, "nodeID")) match {
        case (Some(iri), None) =>
          if (kids.nonEmpty || e.getTextContent.trim.nonEmpty)
            err(s"property '${e.getTagName}' has both rdf:resource and content")
          out += ((subject, predicate, iri, None, None, false))
        case (None, Some(id)) =>
          out += ((subject, predicate, "_:" + id, None, None, false))
        case (Some(_), Some(_)) =>
          err(s"property '${e.getTagName}' cannot have both rdf:resource and rdf:nodeID")
        case (None, None) if kids.nonEmpty =>
          // Nested node element: object = the inner description's subject.
          if (kids.length > 1)
            err(s"property '${e.getTagName}' has ${kids.length} child elements (expected one nested node)")
          val obj = parseNodeElement(kids.head)
          out += ((subject, predicate, obj, None, None, false))
        case (None, None) =>
          // Text-content literal. xsd:string normalizes off, like the
          // N-Triples/Turtle readers.
          val dt = rdfAttr(e, "datatype").filter(_ != XsdString)
          val lang = if (dt.isDefined) None else langOf(e)
          out += ((subject, predicate, e.getTextContent, lang, dt, true))
      }
    }

    childElements(root).foreach(parseNodeElement(_))
    out.result()
  }
}
